"""Model families: the reconstruction pipelines.

* :class:`SobFusion` — non-rigid SobolevFusion (the flagship; reference
  src/sobfu/sob_fusion.cpp)
* :class:`KinFu` — rigid KinectFusion-style tracking + integration
  (reference src/kfusion/kinfu.cpp, completed into a working pipeline)
"""

from sobfu_tpu.pipeline import SobFusion
from sobfu_tpu.kinfu import KinFu, KinFuParams

__all__ = ["SobFusion", "KinFu", "KinFuParams"]
