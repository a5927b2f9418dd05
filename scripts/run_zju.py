"""Batch pipeline over the 6 ZJU-MoCap subjects.

Parity with /root/reference/scripts/run_zju.py: SMPL-prior-supervised stage 1
(reference_points path), skeleton_warm_up 5000, per-subject output dirs.
"""
import argparse
import subprocess
import sys
from pathlib import Path

SUBJECTS = ["377", "386", "387", "392", "393", "394"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--out_root", default="output/zju")
    ap.add_argument("--subjects", nargs="*", default=SUBJECTS)
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    here = Path(__file__).parent
    for sub in args.subjects:
        src = Path(args.data_root) / sub
        out = Path(args.out_root) / sub
        if not src.exists():
            print(f"skip {sub}: {src} not found")
            continue
        cmd = [sys.executable, str(here / "run_pipeline.py"),
               "--source_path", str(src), "--model_path", str(out),
               "--node_num", "512", "--skeleton_warm_up", "5000",
               "--use_skinning_weight_mlp", "--use_template_offsets",
               "--gt_alpha_mask_as_scene_mask"] + args.extra
        print(">>>", sub)
        subprocess.run(cmd, check=True)
        subprocess.run(
            [sys.executable, str(here / "render_rig.py"), "--model_path", str(out), "--mode", "render"],
            check=True,
        )


if __name__ == "__main__":
    main()
