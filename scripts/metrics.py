"""Standalone metrics CLI: compare renders/ vs gt/ folders -> results.json.

Parity with /root/reference/metrics.py:38-97: walks <model_path>/test/ours_N/
(renders, gt) image pairs, computes PSNR / SSIM / MS-SSIM (+LPIPS when
weights are provided), and writes results.json + per_view.json.
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax


def main():
    import numpy as np
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--model_paths", "-m", nargs="+", required=True)
    ap.add_argument("--renders_dir", default="renders")
    ap.add_argument("--gt_dir", default="gt")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--lpips_backbone", default=None, help="torch backbone ckpt for LPIPS")
    ap.add_argument("--lpips_heads", default=None, help="torch lpips linear-head ckpt")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    from riggs_tpu.eval.metrics import evaluate_image, LpipsModel

    lpips_model = None
    if args.lpips_backbone and args.lpips_heads:
        lpips_model = LpipsModel.from_torch_file(args.lpips_backbone, args.lpips_heads)

    for model_path in args.model_paths:
        base = Path(model_path)
        results, per_view = {}, {}
        # reference layout: <model>/test/ours_<iter>/{renders,gt}
        candidates = list(base.glob("test/ours_*")) or [base]
        for scene_dir in candidates:
            rdir, gdir = scene_dir / args.renders_dir, scene_dir / args.gt_dir
            if not rdir.exists() or not gdir.exists():
                continue
            rows = {}
            for rpath in sorted(rdir.iterdir()):
                gpath = gdir / rpath.name
                if not gpath.exists():
                    continue
                img = jnp.asarray(np.asarray(Image.open(rpath).convert("RGB"), np.float32) / 255.0)
                gt = jnp.asarray(np.asarray(Image.open(gpath).convert("RGB"), np.float32) / 255.0)
                rows[rpath.name] = evaluate_image(img, gt, lpips_model)
            if rows:
                keys = next(iter(rows.values())).keys()
                results[scene_dir.name] = {k: float(np.mean([r[k] for r in rows.values()])) for k in keys}
                per_view[scene_dir.name] = rows
        (base / "results.json").write_text(json.dumps(results, indent=2))
        (base / "per_view.json").write_text(json.dumps(per_view, indent=2))
        print(model_path, json.dumps(results))


if __name__ == "__main__":
    main()
