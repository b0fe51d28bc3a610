"""Test the padded-layout hypothesis: u8[...,3] device layout pads the
minor dim 3 -> 128 (42.7x) and the tunnel transfers padded bytes, so
uploading (B,H,W*3) or flat should be ~40x faster than (B,H,W,3)."""

import time

import numpy as np

import jax
import jax.numpy as jnp


def sync(fd):
    return int(np.asarray(fd[(0,) * fd.ndim]))


def timed(name, make, n=3):
    arrs = [make(k) for k in range(n)]
    fd = jnp.asarray(arrs[0])
    sync(fd)
    t0 = time.perf_counter()
    for a in arrs:
        fd = jnp.asarray(a)
        sync(fd)
    dt = time.perf_counter() - t0
    print(f"{name:28s} {arrs[0].nbytes/1e6:7.1f} MB x{n}  {dt:6.2f}s  "
          f"{arrs[0].nbytes*n/dt/1e9:7.3f} GB/s", flush=True)


def main():
    print("device:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    r4 = rng.integers(0, 250, (16, 1080, 1920, 3), dtype=np.uint8)

    timed("u8 (16,1080,1920,3)", lambda k: r4 + np.uint8(k + 1))
    timed("u8 (16,1080,5760)", lambda k: (r4 + np.uint8(k + 1)).reshape(16, 1080, 5760))
    timed("u8 flat", lambda k: (r4 + np.uint8(k + 1)).reshape(-1))
    timed("u8 (16,1080*5760)", lambda k: (r4 + np.uint8(k + 1)).reshape(16, -1))

    # f32 (...,3) vs flat for comparison
    rf = rng.random((4, 1080, 1920, 3), dtype=np.float32)
    timed("f32 (4,1080,1920,3)", lambda k: rf + np.float32(k + 1), n=2)
    timed("f32 (4,1080,5760)", lambda k: (rf + np.float32(k + 1)).reshape(4, 1080, 5760), n=2)

    # downloads: packed det output (B,20,6) f32 vs flat
    d = rng.random((16, 20, 6), dtype=np.float32)
    fd = jnp.asarray(d)
    sync(fd)
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(fd)
    print(f"download (16,20,6) f32 x5: {time.perf_counter()-t0:.3f}s", flush=True)

    # compute on reshaped input: does a flat-uploaded buffer slow the step?
    from padel_analytics_tpu.ops.resize import resize_plan
    plan = resize_plan((1080, 1920), (288, 512), "pil_bicubic")

    @jax.jit
    def step_flat(x_flat):
        x = x_flat.reshape(16, 1080, 1920, 3)
        return jnp.sum(plan.apply(x), axis=(1, 2, 3))

    @jax.jit
    def step_nhwc(x):
        return jnp.sum(plan.apply(x), axis=(1, 2, 3))

    a = (r4 + np.uint8(7)).reshape(16, 1080, 5760)
    out = step_flat(jnp.asarray(a)); np.asarray(out)
    b = r4 + np.uint8(9)
    out = step_nhwc(jnp.asarray(b)); np.asarray(out)

    for name, stepfn, mk in [
        ("resize from (16,1080,5760)", step_flat,
         lambda k: (r4 + np.uint8(20 + k)).reshape(16, 1080, 5760)),
        ("resize from (16,1080,1920,3)", step_nhwc,
         lambda k: r4 + np.uint8(40 + k)),
    ]:
        arrs = [mk(k) for k in range(3)]
        t0 = time.perf_counter()
        outs = [stepfn(jnp.asarray(x)) for x in arrs]
        for o in outs:
            np.asarray(o)
        print(f"{name}: {(time.perf_counter()-t0)/3:.3f}s/chunk", flush=True)
    return 0


if __name__ == "__main__":
    main()
