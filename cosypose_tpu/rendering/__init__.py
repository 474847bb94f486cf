from .scene_renderer import SceneRenderer, BatchRenderer
