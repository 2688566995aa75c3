"""OronTTS-TPU: a TPU-native JAX/Pallas text-to-speech framework.

F5-TTS (OT-CFM flow matching over a DiT backbone) for Mongolian and Kazakh,
re-designed TPU-first: functional JAX core, static shapes, explicit RNG keys,
Pallas kernels on the hot path, and jax.sharding-based parallelism.
"""

__version__ = "0.1.0"
