"""Generate a synthetic EuRoC-layout validation sequence (planar scene,
pixel-exact homography rendering, full ground truth) — the stand-in for
EuRoC MH_01 in zero-egress environments (BASELINE.md ATE gate).

    python scripts/make_synthetic_euroc.py /tmp/synth_euroc --frames 80

Then evaluate the full SLAM engine on it:

    python -m ros_gpu_stereo_processor_tpu.cli slam \
        --calib-left /tmp/synth_euroc/calib_left.yaml \
        --calib-right /tmp/synth_euroc/calib_right.yaml \
        --euroc /tmp/synth_euroc --ndisp 16 --block 9
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ros_gpu_stereo_processor_tpu.utils.synth import make_planar_euroc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    cl, cr = make_planar_euroc(args.root, n_frames=args.frames,
                               width=args.width, height=args.height,
                               seed=args.seed)
    print(f"dataset -> {args.root}\ncalib: {cl} {cr}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
