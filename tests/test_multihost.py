"""Multi-HOST dry run: the halo-exchange window inference over a mesh that
spans TWO PROCESSES (2 x 4 virtual CPU devices, gloo collectives — the DCN
analog), matching the single-process 8-device result exactly.

This exercises init_distributed + cross-process ppermute/collectives,
which single-process mesh tests cannot."""

import json
import socket
import subprocess
import sys
import textwrap

import numpy as np

import jax
import jax.numpy as jnp

from padel_analytics_tpu.models.tracknet import TrackNet
from padel_analytics_tpu.parallel.mesh import make_mesh
from padel_analytics_tpu.parallel.sharded_inference import (
    sharded_window_inference,
)

H, W, N, SEQ = 16, 32, 36, 4

_CHILD = textwrap.dedent(
    """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    pid, port = int(sys.argv[1]), sys.argv[2]
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax.numpy as jnp
    from padel_analytics_tpu.models.tracknet import TrackNet
    from padel_analytics_tpu.parallel.mesh import init_distributed, make_mesh
    from padel_analytics_tpu.parallel.sharded_inference import (
        sharded_window_inference,
    )

    init_distributed(f"localhost:{{port}}", num_processes=2, process_id=pid)
    assert len(jax.devices()) == 8, jax.devices()
    mesh = make_mesh(data=8, model=1)

    H, W, N, SEQ = {h}, {w}, {n}, {seq}
    rng = np.random.default_rng(123)
    frames = rng.integers(0, 256, size=(N, H, W, 3), dtype=np.uint8)
    median = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    model = TrackNet(out_dim=SEQ)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, H, W, (SEQ + 1) * 3), jnp.float32)
    )
    cx, cy, vis = sharded_window_inference(
        lambda x: model.apply(variables, x), frames, median, mesh,
        seq_len=SEQ,
    )
    if pid == 0:
        print("RESULT " + json.dumps(
            [cx.tolist(), cy.tolist(), vis.tolist()]
        ))
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_halo_exchange_matches_single_process(tmp_path):
    import padel_analytics_tpu

    repo = str(
        __import__("pathlib").Path(padel_analytics_tpu.__file__).parents[1]
    )

    # Single-process 8-device reference.
    rng = np.random.default_rng(123)
    frames = rng.integers(0, 256, size=(N, H, W, 3), dtype=np.uint8)
    median = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    model = TrackNet(out_dim=SEQ)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, H, W, (SEQ + 1) * 3), jnp.float32)
    )
    mesh = make_mesh(data=8, model=1)
    cx, cy, vis = sharded_window_inference(
        lambda x: model.apply(variables, x), frames, median, mesh, seq_len=SEQ
    )

    # Two processes x 4 devices. One retry with a fresh port: on this
    # single-core CI host the children compile concurrently and the gloo
    # handshake can time out under full-suite load.
    src = _CHILD.format(repo=repo, h=H, w=W, n=N, seq=SEQ)
    script = tmp_path / "child.py"
    script.write_text(src)
    outs = []
    for attempt in range(2):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(pid), str(port)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
            for pid in (0, 1)
        ]
        try:
            outs = [p.communicate(timeout=600)[0] for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
                p.communicate()
            if attempt == 0:
                continue
            raise
        if all(p.returncode == 0 for p in procs):
            break
        if attempt == 1:
            raise AssertionError(outs)

    line = next(
        l for l in outs[0].splitlines() if l.startswith("RESULT ")
    )
    mcx, mcy, mvis = json.loads(line[len("RESULT "):])
    np.testing.assert_array_equal(np.asarray(mcx), cx)
    np.testing.assert_array_equal(np.asarray(mcy), cy)
    np.testing.assert_array_equal(np.asarray(mvis), vis)
