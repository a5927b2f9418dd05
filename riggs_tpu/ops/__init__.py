from riggs_tpu.ops.quaternion import (
    quat_normalize,
    quat_multiply,
    quat_conjugate,
    quat_rotate,
    quat_to_rotmat,
    rotmat_to_quat,
    quat_slerp,
)
from riggs_tpu.ops.sh import eval_sh, rgb_to_sh_dc, sh_dc_to_rgb, sh_dim
from riggs_tpu.ops.fk import forward_kinematics
from riggs_tpu.ops.knn import knn, mean_knn_dist2, chamfer_distance
from riggs_tpu.ops.fps import farthest_point_sample
