from na_dd_tpu.models.consts import ModelConsts, default_model_consts
from na_dd_tpu.models.coefficients import Model01, Model02

__all__ = ["ModelConsts", "default_model_consts", "Model01", "Model02"]
