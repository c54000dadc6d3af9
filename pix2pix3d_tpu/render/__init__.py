from .ray_sampler import sample_rays
from .ray_marcher import march_rays
from .renderer import ImportanceRenderer, sample_from_planes, generate_plane_axes
from .camera import (
    GaussianCameraPoseSampler,
    LookAtPoseSampler,
    UniformCameraPoseSampler,
    create_cam2world_matrix,
    fov_to_intrinsics,
)
from . import math_utils
