from webdgs_tpu.core.camera import Camera, CameraData, make_camera
from webdgs_tpu.core.scene import GaussianScene

__all__ = ["Camera", "CameraData", "make_camera", "GaussianScene"]
