"""Robot + scene model library (the reference's 'models' are robot/scene
descriptions loaded through Tesseract from trajopt_common/data/; ours are
self-authored URDF fixtures plus programmatic scenes)."""

from trajopt_tpu.models.robots import arm7, boxbot, rrbot, spherebot  # noqa: F401
