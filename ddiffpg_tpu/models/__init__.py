"""Network zoo (flax.linen).

Name-for-name capability match with the reference model zoo
(`/root/reference/ddiffpg/models/mlp.py`, `diffusion_mlp.py`,
`baseline_models.py`), resolved by class name via `get_model` instead of the
reference's AST directory scan (`models/__init__.py` + `utils/common.py`).
"""

from ddiffpg_tpu.models import mlp, diffusion, baseline_diffusion

_REGISTRY = {}
for _mod in (mlp, diffusion, baseline_diffusion):
    for _name in getattr(_mod, "__all__", []):
        _REGISTRY[_name] = getattr(_mod, _name)


def get_model(name: str):
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]
