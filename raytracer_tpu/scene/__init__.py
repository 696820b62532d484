from raytracer_tpu.scene.types import (
    Materials,
    Spheres,
    TriMesh,
    Scene,
    LAMBERTIAN,
    METAL,
    DIELECTRIC,
    DIFFUSE_LIGHT,
)
