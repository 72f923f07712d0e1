"""f-BRS interactive click segmentation (the reference GUI's click backend,
``XMem/inference/interact/fbrs/``), rebuilt TPU-native."""

from d3fields_tpu.models.fbrs.hrnet import HrnetConfig  # noqa: F401
from d3fields_tpu.models.fbrs.model import (  # noqa: F401
    FbrsConfig, convert_torch_state_dict, detect_config, forward, init_params,
)
