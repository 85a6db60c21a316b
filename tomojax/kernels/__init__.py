from tomojax.kernels.resample import resample_rows_pallas

__all__ = ["resample_rows_pallas"]
