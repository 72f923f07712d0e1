"""Scribble-to-Mask (S2M) network + controller (the reference GUI's
scribble backend, ``XMem/inference/interact/s2m/``), rebuilt TPU-native."""

from d3fields_tpu.models.s2m.controller import S2MController  # noqa: F401
from d3fields_tpu.models.s2m.model import (  # noqa: F401
    S2mConfig, convert_torch_state_dict, forward, init_params,
)
