"""Thin shim: the converter lives in ``d3fields_tpu.apps.convert_ckpts``
(so the installed wheel ships it as the ``d3f-convert-ckpts`` console
script). Kept here because docs and muscle memory say
``python tools/convert_ckpts.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3fields_tpu.apps.convert_ckpts import (  # noqa: E402,F401
    ENV_VARS, convert_one, main,
)

if __name__ == "__main__":
    main()
