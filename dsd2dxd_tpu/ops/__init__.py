"""Device-side DSP ops (JAX/XLA/Pallas) and signal synthesis utilities."""
