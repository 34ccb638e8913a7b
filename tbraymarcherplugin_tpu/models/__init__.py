"""Model families: renderer variants + the differentiable-fit inverse model.

- :mod:`.pipeline` — the functional end-to-end lit pipeline (lighting + march
  in one jitted, differentiable function).
- :mod:`.fitting` — inverse rendering: optimize TF / window / volume / light
  intensities against target renders (BASELINE config 4).

The interactive renderer variants (lit / intensity / octree) live on
:class:`tbraymarcherplugin_tpu.renderer.Renderer`.
"""

from .fitting import FitConfig, fit, image_loss, make_loss_fn
from .pipeline import LightPlan, RenderParams, compute_illumination, render_lit_scene

__all__ = [
    "FitConfig",
    "LightPlan",
    "RenderParams",
    "compute_illumination",
    "fit",
    "image_loss",
    "make_loss_fn",
    "render_lit_scene",
]
