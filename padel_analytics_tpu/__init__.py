"""padel_analytics_tpu — a TPU-native (JAX/XLA/Pallas) padel video-analytics framework.

A ground-up rebuild of the capabilities of Joao-M-Silva/padel_analytics
(reference mounted read-only at /root/reference) designed TPU-first:

- all model math (YOLOv8 detect/pose, TrackNet, InpaintNet, ResNet50 court
  regression) is Flax/JAX compiled by XLA, NHWC, bfloat16-friendly;
- preprocessing (resize / letterbox / normalize) runs on device as
  matrix-multiplication resampling kernels that map onto the MXU;
- post-processing (NMS, heatmap->coordinate decode, polygon filtering,
  homography projection, temporal overlap ensembling) is vectorized jnp,
  not per-frame Python;
- the clip's frame axis shards across a `jax.sharding.Mesh` for multi-chip
  scaling (see `padel_analytics_tpu.parallel`);
- the video is decoded ONCE (the reference decodes it 5x:
  /root/reference/trackers/runner.py:215-220,107-112).

Public surface mirrors the reference's (trackers, runner, analytics,
config) so a reference user can switch with minimal friction.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the pipeline compiles a handful of
# large programs (pose@1280, TrackNet windows, detection) whose first
# compile costs minutes; caching makes warm starts near-instant across
# processes. Opt out with PADEL_TPU_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("PADEL_TPU_NO_COMPILE_CACHE"):
    try:
        import hashlib as _hashlib

        import jax as _jax

        # Key the cache dir by a host fingerprint (CPU feature flags +
        # jaxlib version): XLA:CPU AOT entries embed the compile host's
        # machine features, and loading an entry produced on a different
        # host can SIGILL/abort ("Machine type used for XLA:CPU
        # compilation doesn't match the machine type for execution").
        # Sessions migrate machines between rounds, so a shared dir
        # poisons later runs; a per-host dir is always safe.
        def _host_fingerprint() -> str:
            bits = [getattr(_jax, "__version__", "?")]
            try:
                with open("/proc/cpuinfo") as f:
                    for line in f:
                        if line.startswith("flags"):
                            bits.append(line.strip())
                            break
            except OSError:
                pass
            return _hashlib.sha1("|".join(bits).encode()).hexdigest()[:12]

        _cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.path.join(
            _os.path.expanduser("~/.cache/padel_tpu_xla"), _host_fingerprint()
        )
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

# Re-exports of the reference-parity public API (lazy to keep import light).
_LAZY = {
    "Player": "padel_analytics_tpu.trackers.objects",
    "Players": "padel_analytics_tpu.trackers.objects",
    "Ball": "padel_analytics_tpu.trackers.objects",
    "Keypoint": "padel_analytics_tpu.trackers.objects",
    "Keypoints": "padel_analytics_tpu.trackers.objects",
    "PlayerKeypoint": "padel_analytics_tpu.trackers.objects",
    "PlayerKeypoints": "padel_analytics_tpu.trackers.objects",
    "PlayersKeypoints": "padel_analytics_tpu.trackers.objects",
    "Tracker": "padel_analytics_tpu.trackers.base",
    "TrackingRunner": "padel_analytics_tpu.trackers.runner",
    "PlayerTracker": "padel_analytics_tpu.trackers.players",
    "PlayerKeypointsTracker": "padel_analytics_tpu.trackers.player_keypoints",
    "KeypointsTracker": "padel_analytics_tpu.trackers.court_keypoints",
    "BallTracker": "padel_analytics_tpu.trackers.ball",
    "ProjectedCourt": "padel_analytics_tpu.analytics.projected_court",
    "DataAnalytics": "padel_analytics_tpu.analytics.data_analytics",
    "BallVelocityEstimator": "padel_analytics_tpu.analytics.velocity_estimator",
    "ImpactType": "padel_analytics_tpu.analytics.velocity_estimator",
    "PipelineConfig": "padel_analytics_tpu.config",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module = importlib.import_module(_LAZY[name])
        return getattr(module, name)
    raise AttributeError(f"module 'padel_analytics_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
