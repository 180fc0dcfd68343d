#!/usr/bin/env python
"""Annotation cleaner: strip entries whose image files are missing.

Parity with `models/clean_annotations.py:1-243` in the reference: scans a
COCO annotation JSON against the image directory, removes images (and their
annotations) whose files don't exist, writes a `.backup` of the original,
and prints a report.

Usage:
    python scripts/clean_annotations.py --ann_file path/to/mp100_split1_train.json \
        --img_dir /path/to/mp100/data [--dry_run]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann_file", required=True)
    p.add_argument("--img_dir", required=True)
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()

    with open(args.ann_file) as f:
        data = json.load(f)

    missing_ids = set()
    for img in data.get("images", []):
        if not os.path.exists(os.path.join(args.img_dir, img["file_name"])):
            missing_ids.add(img["id"])

    n_img = len(data.get("images", []))
    n_ann = len(data.get("annotations", []))
    kept_images = [i for i in data["images"] if i["id"] not in missing_ids]
    kept_anns = [a for a in data["annotations"]
                 if a["image_id"] not in missing_ids]

    print(f"Images:      {n_img} -> {len(kept_images)} "
          f"({len(missing_ids)} missing files removed)")
    print(f"Annotations: {n_ann} -> {len(kept_anns)}")

    if args.dry_run:
        print("Dry run — nothing written.")
        return
    if missing_ids:
        backup = args.ann_file + ".backup"
        if not os.path.exists(backup):
            shutil.copyfile(args.ann_file, backup)
            print(f"Backup written to {backup}")
        data["images"] = kept_images
        data["annotations"] = kept_anns
        with open(args.ann_file, "w") as f:
            json.dump(data, f)
        print(f"Cleaned annotations written to {args.ann_file}")
    else:
        print("All image files present — nothing to clean.")


if __name__ == "__main__":
    main()
