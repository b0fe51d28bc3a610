"""Do concurrent host->device transfers scale aggregate bandwidth on the
tunnel? Tests ThreadPoolExecutor uploads of distinct buffers vs serial,
plus whether upload overlaps with device compute."""

import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp


def sync(fd):
    return int(np.asarray(fd[(0,) * fd.ndim]))


def main():
    print("device:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 200, (8, 1080, 1920, 3), dtype=np.uint8)  # ~50MB

    def mk(k):
        return base + np.uint8(k + 1)

    # warm
    fd = jnp.asarray(mk(0)); sync(fd)

    # serial 8 x 50MB
    arrs = [mk(k) for k in range(8)]
    t0 = time.perf_counter()
    fds = []
    for a in arrs:
        fds.append(jnp.asarray(a))
    for f in fds:
        sync(f)
    dt = time.perf_counter() - t0
    print(f"serial   8x50MB: {dt:6.2f}s  {8*arrs[0].nbytes/dt/1e9:.3f} GB/s", flush=True)

    for nthreads in (2, 4, 8):
        arrs = [mk(10 * nthreads + k) for k in range(8)]
        t0 = time.perf_counter()
        with ThreadPoolExecutor(nthreads) as ex:
            fds = list(ex.map(lambda a: jnp.asarray(a), arrs))
        for f in fds:
            sync(f)
        dt = time.perf_counter() - t0
        print(f"threads{nthreads} 8x50MB: {dt:6.2f}s  "
              f"{8*arrs[0].nbytes/dt/1e9:.3f} GB/s", flush=True)

    # upload/compute overlap: dispatch a heavy matmul loop, then upload
    # during it.
    x = jnp.asarray(rng.random((4096, 4096), np.float32))
    y = jnp.asarray(rng.random((4096, 4096), np.float32))

    @jax.jit
    def heavy(x, y):
        def body(c, _):
            return jnp.tanh(c @ y), None
        c, _ = jax.lax.scan(body, x, None, length=200)
        return jnp.sum(c)

    out = heavy(x, y); float(out)  # compile+warm
    t0 = time.perf_counter()
    out = heavy(x, y)
    t_compute = None
    a = mk(99)
    t1 = time.perf_counter()
    fd = jnp.asarray(a)
    sync(fd)
    t_upload_during = time.perf_counter() - t1
    float(out)
    t_total = time.perf_counter() - t0
    print(f"compute+upload overlap: upload-during={t_upload_during:.2f}s "
          f"total={t_total:.2f}s", flush=True)
    t0 = time.perf_counter()
    out = heavy(x, y); float(out)
    print(f"compute alone: {time.perf_counter()-t0:.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    main()
