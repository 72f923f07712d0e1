"""Headless interactive video-object-segmentation sessions.

The reference ships a Qt GUI (``XMem/inference/interact/gui.py``) whose
*function* — click/scribble/free-draw an object mask on any frame, commit
it, bidirectionally propagate it with XMem, save paletted masks — lives
here without the widget shell (this environment is headless; the event
loop becomes an explicit method-call API and a scriptable CLI,
``apps/interactive.py``).
"""

from d3fields_tpu.interact.overlays import (  # noqa: F401
    get_visualization,
    get_visualization_soft,
)
from d3fields_tpu.interact.session import (  # noqa: F401
    ClickInteraction,
    FreeInteraction,
    InteractiveSession,
    ScribbleInteraction,
    aggregate_wbg,
)
