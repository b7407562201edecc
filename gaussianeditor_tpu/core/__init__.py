from gaussianeditor_tpu.core.cameras import (
    Camera,
    fov2focal,
    focal2fov,
    get_projection_matrix,
    get_world2view,
)
from gaussianeditor_tpu.core.sh import (
    eval_sh,
    num_sh_bases,
    rgb2sh,
    sh2rgb,
)
from gaussianeditor_tpu.core.transforms import (
    build_covariance,
    build_scaling_rotation,
    quat_multiply,
    quat_to_rotmat,
)
