from riggs_tpu.camera.camera import (
    Camera,
    make_camera,
    world_to_view,
    project_points,
    camera_center,
    fov2focal,
    focal2fov,
)
