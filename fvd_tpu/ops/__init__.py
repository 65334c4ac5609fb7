"""Device-side kernels (JAX/XLA/Pallas)."""
