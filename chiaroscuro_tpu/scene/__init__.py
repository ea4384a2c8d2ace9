from chiaroscuro_tpu.scene.config import RenderConfig
from chiaroscuro_tpu.scene.obj_loader import Mesh, load_obj
from chiaroscuro_tpu.scene.scene_arrays import SceneArrays, build_scene_arrays, load_scene

__all__ = [
    "RenderConfig",
    "Mesh",
    "load_obj",
    "SceneArrays",
    "build_scene_arrays",
    "load_scene",
]
