from .build import SceneData, SceneMeta, World
from .types import MatH, ObjH, TexH

__all__ = ["SceneData", "SceneMeta", "World", "MatH", "ObjH", "TexH"]
