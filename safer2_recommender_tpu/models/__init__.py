from safer2_recommender_tpu.models.base import MFState, Recommender
from safer2_recommender_tpu.models.cvar_mf import CVaRMF
from safer2_recommender_tpu.models.erm_mf import ERMMF
from safer2_recommender_tpu.models.ials import IALS
from safer2_recommender_tpu.models.ialspp import IALSpp
from safer2_recommender_tpu.models.safer2 import SAFER2
from safer2_recommender_tpu.models.safer2pp import SAFER2pp

# Model factory (reference tools/run_model.cc:43-123's get_model).
MODEL_REGISTRY = {
    "ials": IALS,
    "ialspp": IALSpp,
    "erm_mf": ERMMF,
    "cvar_mf": CVaRMF,
    "safer2": SAFER2,
    "safer2pp": SAFER2pp,
}


def get_model(name: str, cfg, num_users: int, num_items: int, mesh=None):
    try:
        cls = MODEL_REGISTRY[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; expected one of "
            f"{sorted(MODEL_REGISTRY)}") from None
    return cls(cfg, num_users, num_items, mesh=mesh)


__all__ = [
    "MFState", "Recommender", "IALS", "IALSpp", "ERMMF", "CVaRMF",
    "SAFER2", "SAFER2pp", "MODEL_REGISTRY", "get_model",
]
