"""Device-side numerical kernels (JAX/XLA/Pallas)."""
