from .jnp_msm import default_window_bits, msm, num_windows, signed_digits

__all__ = ["msm", "signed_digits", "num_windows", "default_window_bits"]
