"""Robot + scene model library (the reference's 'models' are robot/scene
descriptions loaded through Tesseract from trajopt_common/data/; ours are
self-authored URDF fixtures plus programmatic scenes)."""

from trajopt_tpu.models.robots import (  # noqa: F401
    arm6, arm6_scene, arm7, arm7_scene, boxbot, rrbot, spherebot)
