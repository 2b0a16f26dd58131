"""Turnkey real-weights rehearsal: released .pt checkpoints -> full
two-stage metric report in ONE command.

The reference's published eval flow (reference README.md:68-70,158-159) is:
download the stage-1 `53618.pt` and stage-2 `91453.pt` checkpoints, the
SMPL body pkls and the EgoBody release, then run test_prohmr_scene.py to
dump per-frame camera translations and test_egohmr.py consuming them. This
tool is that flow end-to-end against THIS framework:

  1. stage-1 eval CLI on the reference-layout .pt (converted on load by
     `interop.torch_convert.convert_prohmr`) -> metrics + results.pkl;
  2. stage-2 eval CLI on the reference-layout .pt
     (`convert_egohmr`), --two_stage, consuming that results.pkl;
  3. one combined JSON report (stage-1 + stage-2 metrics, mm) printed and
     written to <save_root>/report.json.

Usage (real-weights day):
  python tools/real_weights_eval.py \
      --stage1_checkpoint checkpoints/53618.pt \
      --stage2_checkpoint checkpoints/91453.pt \
      --smpl_model_path data/smpl \
      --dataset_root /mnt/ssd/egobody_release \
      --body_rep_stats data/preprocess_stats/preprocess_stats.npz \
      --save_root output_results/real_weights

Every seam is CI-exercised with FABRICATED reference-layout checkpoints
(interop.torch_export) and the on-disk EgoBody fixture in
tests/test_real_weights_rehearsal.py, so a real weight drop is a file
path, not an integration project.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Two-stage eval from reference-layout checkpoints")
    b = lambda x: str(x).lower() in ["true", "1"]
    p.add_argument("--stage1_checkpoint", type=str, required=True,
                   help="reference-layout stage-1 .pt (53618.pt) or an "
                        "orbax dir trained in this framework")
    p.add_argument("--stage2_checkpoint", type=str, required=True,
                   help="reference-layout stage-2 .pt (91453.pt) or an "
                        "orbax dir")
    p.add_argument("--smpl_model_path", type=str, default="data/smpl")
    p.add_argument("--dataset_root", type=str,
                   default="/mnt/ssd/egobody_release")
    p.add_argument("--dataset_file", type=str, default="",
                   help="test-split npz (defaults to the EgoBody release "
                        "layout under --dataset_root)")
    p.add_argument("--body_rep_stats", type=str, default="",
                   help="preprocess_stats.npz (stage-2 body-rep whitening)")
    p.add_argument("--save_root", type=str,
                   default="output_results/real_weights")
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--num_samples", type=int, default=5,
                   help="diverse samples per image for both stages "
                        "(reference paper setting)")
    p.add_argument("--num_batches", type=int, default=0,
                   help="limit evaluated batches (0 = full test split)")
    p.add_argument("--eval_spacing", type=int, default=1)
    p.add_argument("--timestep_respacing_eval", type=str, default="ddpm",
                   choices=["ddim5", "ddpm"])
    p.add_argument("--with_coap_grad", type=b, default=True)
    p.add_argument("--collision_backend", type=str, default="sdf",
                   choices=["sdf", "occupancy", "volsdf"])
    p.add_argument("--occupancy_ckpt", type=str, default="")
    p.add_argument("--sdfnet_ckpt", type=str, default="")
    p.add_argument("--bf16", type=b, default=True)
    p.add_argument("--data_parallel", type=b, default=True)
    p.add_argument("--scene_crop_by_stage1_transl", type=b, default=True,
                   help="re-crop the scene cube around the stage-1 "
                        "translation (the reference two-stage behavior); "
                        "false when the dataset ships pre-cropped cubes")
    p.add_argument("--platform", type=str, default="",
                   help="force a JAX platform (e.g. 'cpu')")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from egohmr_tpu.eval import test_egohmr, test_prohmr

    os.makedirs(args.save_root, exist_ok=True)
    s1_root = os.path.join(args.save_root, "stage1")

    common = []
    if args.platform:
        common += ["--platform", args.platform]
    if args.dataset_file:
        common += ["--dataset_file", args.dataset_file]

    print(f"[1/2] stage-1 eval: {args.stage1_checkpoint}", flush=True)
    s1 = test_prohmr.main(common + [
        "--checkpoint", args.stage1_checkpoint,
        "--smpl_model_path", args.smpl_model_path,
        "--dataset_root", args.dataset_root,
        "--batch_size", str(args.batch_size),
        "--num_samples", str(args.num_samples),
        "--num_batches", str(args.num_batches),
        "--eval_spacing", str(args.eval_spacing),
        "--scene_type", "whole_scene",
        "--save_results", "true",
        "--save_root", s1_root,
    ])

    pkl = os.path.join(s1_root, "results.pkl")
    print(f"[2/2] stage-2 eval: {args.stage2_checkpoint} "
          f"(two-stage, transl from {pkl})", flush=True)
    s2_args = common + [
        "--checkpoint", args.stage2_checkpoint,
        "--smpl_model_path", args.smpl_model_path,
        "--dataset_root", args.dataset_root,
        "--batch_size", str(args.batch_size),
        "--num_samples", str(args.num_samples),
        "--num_batches", str(args.num_batches),
        "--eval_spacing", str(args.eval_spacing),
        "--timestep_respacing_eval", args.timestep_respacing_eval,
        "--with_coap_grad", "true" if args.with_coap_grad else "false",
        "--collision_backend", args.collision_backend,
        "--bf16", "true" if args.bf16 else "false",
        "--data_parallel", "true" if args.data_parallel else "false",
        "--two_stage", "true",
        "--stage1_result_path", pkl,
        "--scene_crop_by_stage1_transl",
        "true" if args.scene_crop_by_stage1_transl else "false",
    ]
    if args.body_rep_stats:
        s2_args += ["--body_rep_stats", args.body_rep_stats]
    if args.occupancy_ckpt:
        s2_args += ["--occupancy_ckpt", args.occupancy_ckpt]
    if args.sdfnet_ckpt:
        s2_args += ["--sdfnet_ckpt", args.sdfnet_ckpt]
    s2 = test_egohmr.main(s2_args)

    report = {
        "stage1_checkpoint": args.stage1_checkpoint,
        "stage2_checkpoint": args.stage2_checkpoint,
        "stage1_metrics_mm": s1,
        "stage2_metrics": s2,
    }
    out = os.path.join(args.save_root, "report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"report written to {out}")
    return report


if __name__ == "__main__":
    main()
