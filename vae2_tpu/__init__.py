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
