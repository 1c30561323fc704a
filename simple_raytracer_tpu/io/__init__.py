"""Asset and image I/O: STL/OBJ meshes, PPM/PNG output, skybox, scene JSON."""

from .image import load_ppm, load_skybox, save_png, save_ppm
from .obj import load_obj_model
from .scene_json import load_scene, save_scene
from .stl import load_stl_model, save_stl
