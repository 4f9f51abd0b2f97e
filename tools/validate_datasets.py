#!/usr/bin/env python
"""Dataset validation + hygiene (the reference's setup.sh logic in Python).

For each dataset root (reference: setup/setup.sh:24-143):
  * check the {train,test}/{Imgs,GT[,Edges]} layout;
  * cross-check image/mask/edge basenames, report (optionally delete) orphans;
  * generate CAMO-style GT edge maps when train/Edges is missing
    (reference: setup.sh:79-105).

Usage:
  python tools/validate_datasets.py datasets/COD10K datasets/CAMO [--fix]
         [--generate-edges]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def stems(d: Path, exts) -> dict:
    out = {}
    if d.exists():
        for f in d.iterdir():
            if f.suffix.lower() in exts:
                out[f.stem] = f
    return out


def check_split(split_dir: Path, need_edges: bool, fix: bool) -> dict:
    stats = {"samples": 0, "orphans": 0, "removed": 0}
    imgs = stems(split_dir / "Imgs", {".jpg", ".png", ".jpeg"})
    gts = stems(split_dir / "GT", {".png"})
    sets = [("Imgs", imgs), ("GT", gts)]
    if need_edges:
        edges = stems(split_dir / "Edges", {".png"})
        sets.append(("Edges", edges))
    common = set.intersection(*(set(s) for _, s in sets)) if sets else set()
    stats["samples"] = len(common)
    for name, files in sets:
        orphans = set(files) - common
        stats["orphans"] += len(orphans)
        for stem in sorted(orphans):
            print(f"  orphan {name}/{files[stem].name}")
            if fix:
                files[stem].unlink()
                stats["removed"] += 1
    return stats


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("datasets", nargs="+", help="Dataset root directories")
    p.add_argument("--fix", action="store_true", help="Delete orphaned files")
    p.add_argument("--generate-edges", action="store_true",
                   help="Generate train/Edges from train/GT when missing")
    args = p.parse_args()

    ok = True
    for root in args.datasets:
        root = Path(root)
        print(f"== {root} ==")
        if not root.exists():
            print("  MISSING")
            ok = False
            continue
        for split in ("train", "test"):
            sdir = root / split
            if not sdir.exists():
                print(f"  (no {split}/ split)")
                continue
            need_edges = split == "train"
            if need_edges and not (sdir / "Edges").exists():
                if args.generate_edges:
                    from spegnet_tpu.utils.camo_edges import CAMOEdgeProcessor

                    print(f"  generating {split}/Edges from GT ...")
                    CAMOEdgeProcessor(edge_width=1).process_dataset(
                        sdir / "GT", sdir / "Edges"
                    )
                else:
                    print(f"  {split}/Edges missing (use --generate-edges)")
                    ok = False
                    continue
            stats = check_split(sdir, need_edges, args.fix)
            print(f"  {split}: {stats['samples']} samples, "
                  f"{stats['orphans']} orphans"
                  + (f", {stats['removed']} removed" if args.fix else ""))
            if stats["samples"] == 0:
                ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
