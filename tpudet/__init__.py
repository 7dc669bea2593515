"""tpudet — a TPU-native (JAX/XLA/Pallas) object-detection framework.

From-scratch rebuild of the capabilities of the Stick-To/Object-Detection-Tensorflow
detector zoo (see SURVEY.md): SSD300/512, YOLOv2/v3, RetinaNet, RefineDet320, PFPNet-R,
Light-Head R-CNN, CenterNet and FCOS, with a shared fixed-shape ops layer (anchors, IoU
matching, box coding, NMS, heatmap decode), jitted flax backbones/necks, data-parallel
training over a `jax.sharding.Mesh`, and a TFRecord/VOC data subsystem that does not
depend on TensorFlow.
"""

__version__ = "0.2.0"


def _enable_persistent_compile_cache():
    """Point JAX's persistent compilation cache at a repo-local directory unless the
    user already configured one. TPU compiles of the larger detectors take minutes;
    the cache turns every rerun (drivers, benchmarks, tests) into a warm start."""
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user/env already chose a cache location
    try:
        import jax

        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never make importing tpudet fail over a cache
        pass


_enable_persistent_compile_cache()
