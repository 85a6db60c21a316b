from tomojax.recon.cgls import (cgls, cgls_init, cgls_steps, CGLSResult,
                                CGLSState)
from tomojax.recon.sirt import sirt, SIRTResult
from tomojax.recon.tikhonov import tikhonov_gd, TikhonovResult
from tomojax.recon.lasso import lasso_ista, lasso_fista, LassoResult
from tomojax.recon.fista_tv import fista_tv, FistaTVResult
from tomojax.recon import tv

__all__ = [
    "cgls", "cgls_init", "cgls_steps", "CGLSResult", "CGLSState",
    "sirt", "SIRTResult", "tikhonov_gd",
    "TikhonovResult", "lasso_ista", "lasso_fista", "LassoResult",
    "fista_tv", "FistaTVResult", "tv",
]
