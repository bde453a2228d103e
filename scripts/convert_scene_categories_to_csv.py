"""Convert ADE20K-style sceneCategories.txt to the labels.csv format that
`saev_tpu.data.datasets.ImgSegFolder` expects (capability mirror of reference
scripts/convert_scene_categories_to_csv.py).

Input lines:  `<stem> <label>`
Output CSV:   header `stem,<label-col>`, one row per line.

Usage:
    python scripts/convert_scene_categories_to_csv.py /path/to/dataset \
        [--input sceneCategories.txt] [--output labels.csv] [--label-col scene]
"""

import argparse
import csv
import pathlib


def convert(
    root: pathlib.Path,
    input_name: str = "sceneCategories.txt",
    output_name: str = "labels.csv",
    label_col: str = "scene",
) -> pathlib.Path:
    input_fpath = root / input_name
    output_fpath = root / output_name
    assert input_fpath.exists(), f"Input file not found: {input_fpath}"

    rows = []
    with open(input_fpath) as fd:
        for line in fd:
            line = line.strip()
            if not line:
                continue
            stem, _, label = line.partition(" ")
            rows.append((stem, label.strip()))

    with open(output_fpath, "w", newline="") as fd:
        writer = csv.writer(fd)
        writer.writerow(["stem", label_col])
        writer.writerows(rows)
    return output_fpath


def main():
    parser = argparse.ArgumentParser(
        description="Convert sceneCategories.txt to labels.csv"
    )
    parser.add_argument("root", type=pathlib.Path, help="Dataset root directory")
    parser.add_argument("--input", default="sceneCategories.txt", help="Input filename")
    parser.add_argument("--output", default="labels.csv", help="Output filename")
    parser.add_argument("--label-col", default="scene", help="Name for the label column")
    args = parser.parse_args()
    out = convert(args.root, args.input, args.output, args.label_col)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
