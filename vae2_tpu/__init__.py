"""vae2_tpu — a TPU-native video-prediction framework.

A from-scratch JAX/XLA/Pallas implementation of the VAE^2 video-prediction
stack ("Preventing Posterior Collapse of Variational Video Predictions in the
Wild"): clip data pipeline, HRNet-style multi-resolution encoder/decoders,
variational latent sampling with posterior-collapse mitigations, dual-LSGAN
adversarial training, and a bit-comparable FID / Inception-Score eval stack.

Reference capability surface: /root/reference (PyTorch); see SURVEY.md.
Everything here is designed TPU-first: NHWC layouts, bfloat16 compute on the
MXU, functional state, jitted train steps, SPMD sharding over a device mesh.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: model graphs here are large (HRNet trunks
# x6 in one train step) and XLA compiles host-side; caching compiled
# executables to disk makes repeat runs, tests, and resumed training start in
# seconds instead of minutes. Opt out with VAE2_TPU_NO_COMPILE_CACHE=1.
import os as _os

if _os.environ.get("VAE2_TPU_NO_COMPILE_CACHE") != "1":
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/vae2_tpu_xla"))
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
