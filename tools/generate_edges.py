#!/usr/bin/env python
"""Offline GT edge-map generation (the reference's setup.sh CAMO step).

Usage: python tools/generate_edges.py <GT_dir> <Edges_dir> [--edge-width N]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spegnet_tpu.utils.camo_edges import CAMOEdgeProcessor


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="Directory of GT masks (*.png)")
    p.add_argument("output", help="Directory to write edge maps")
    p.add_argument("--edge-width", type=int, default=1)
    p.add_argument("--threshold", type=float, default=0.5,
                   help="Edge-continuity validation threshold")
    args = p.parse_args()
    stats = CAMOEdgeProcessor(args.edge_width, args.threshold).process_dataset(
        args.input, args.output
    )
    print(stats)


if __name__ == "__main__":
    main()
