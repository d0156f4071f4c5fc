"""Model registry, mirroring the reference's dynamic import by ``llama_type``
(model/accessory/model/meta.py:30). Each entry maps a llama_type string to a
module exposing the functional model API."""

from importlib import import_module

_LLAMA_TYPE_MODULES = {
    "llama": "a3vlm_tpu.models.llama",
    "llama_ens5": "a3vlm_tpu.models.ens5",
    "llama_ens5_2images": "a3vlm_tpu.models.ens5_2images",
    "internlm_ems5_light": "a3vlm_tpu.models.internlm_ems5_light",
    "falcon": "a3vlm_tpu.models.falcon",
}


def get_model_module(llama_type: str):
    if llama_type not in _LLAMA_TYPE_MODULES:
        raise KeyError(
            f"unknown llama_type {llama_type!r}; known: "
            f"{sorted(_LLAMA_TYPE_MODULES)}"
        )
    return import_module(_LLAMA_TYPE_MODULES[llama_type])
