"""Batch pipeline over the 11 D-NeRF / DG-Mesh synthetic scenes.

Parity with /root/reference/scripts/run_synthesis.py: runs the full two-stage
pipeline + rendering for every scene (with its paper view id for time
interpolation).
"""
import argparse
import subprocess
import sys
from pathlib import Path

SCENES = [
    "jumpingjacks", "mutant", "hook", "hellwarrior", "standup", "trex",
    "beagle", "bird", "duck", "girlwalk", "horse",
]
# fixed interpolation view per scene (reference scripts/run_synthesis.py:6)
VIEW_IDS = {"jumpingjacks": 1, "mutant": 0, "hook": 2, "hellwarrior": 0, "standup": 0,
            "trex": 1, "beagle": 0, "bird": 0, "duck": 0, "girlwalk": 0, "horse": 0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--out_root", default="output/synthesis")
    ap.add_argument("--scenes", nargs="*", default=SCENES)
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    here = Path(__file__).parent
    for scene in args.scenes:
        src = Path(args.data_root) / scene
        out = Path(args.out_root) / scene
        if not src.exists():
            print(f"skip {scene}: {src} not found")
            continue
        base = [sys.executable, str(here / "run_pipeline.py"),
                "--source_path", str(src), "--model_path", str(out),
                "--node_num", "512", "--use_isotropic_gs", "--gs_with_motion_mask",
                "--use_skinning_weight_mlp", "--use_template_offsets"] + args.extra
        print(">>>", scene)
        subprocess.run(base, check=True)
        for mode in ("render", "time", "motion"):
            subprocess.run(
                [sys.executable, str(here / "render_rig.py"), "--model_path", str(out),
                 "--mode", mode, "--view_id", str(VIEW_IDS.get(scene, 0))],
                check=True,
            )


if __name__ == "__main__":
    main()
