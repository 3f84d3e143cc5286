"""Pure, Ray-free kernels. Everything here is deterministic and importable
inside Ray workers without side effects."""
