from pathtracer.accel import bruteforce, lbvh, morton

__all__ = ["bruteforce", "lbvh", "morton"]
