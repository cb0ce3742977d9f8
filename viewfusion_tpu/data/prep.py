"""Offline NMR dataset sharder.

Capability parity with the reference ``data/dataset_prep.py``: reads
``NMR_Dataset.zip`` (+ ``metadata.yaml`` and per-class ``{split}.lst``
listings inside it), writes ``NMR-{split}-{NN}.tar`` webdataset shards
whose samples hold keys ``0000.png .. 0023.png`` + ``cameras.npz``
(data/dataset_prep.py:79-101).  Supports ``--percent`` subsampling,
``--shard_count``, and category withholding for generalization
experiments (data/dataset_prep.py:12-18, 56-62, 112-114), including the
uneven-overflow-shard warning (data/dataset_prep.py:103-108).
"""

from __future__ import annotations

import argparse
import os
import warnings
import zipfile
from typing import Dict, List, Sequence

import yaml

from viewfusion_tpu.data.tario import TarShardWriter

__all__ = ["get_dataset_size", "shard_dataset", "main"]


def _class_scene_list(src_zip: zipfile.ZipFile, key: str,
                      split: str) -> List[str]:
    base_path = f"NMR_Dataset/{key}"
    listing = src_zip.read(f"{base_path}/{split}.lst").split()
    return [f"{base_path}/{name.decode('utf-8')}" for name in listing]


def get_dataset_size(src_dir: str,
                     withheld: Sequence[str] = ()) -> Dict[str, Dict[str, int]]:
    """Per-split per-class scene counts (reference:
    data/dataset_prep.py:21-42)."""
    src_zip = zipfile.ZipFile(os.path.join(src_dir, "NMR_Dataset.zip"))
    metadata = yaml.safe_load(src_zip.read("NMR_Dataset/metadata.yaml"))
    size_dict: Dict[str, Dict[str, int]] = {}
    for split in ("train", "val", "test"):
        split_dict = {}
        for key in metadata:
            if metadata[key]["name"] in withheld:
                continue
            cnt = len(_class_scene_list(src_zip, key, split))
            print(f"{metadata[key]['name']}: {cnt}")
            split_dict[key] = cnt
        size_dict[split] = split_dict
    return size_dict


def shard_dataset(
    src_dir: str,
    size_dict: Dict[str, Dict[str, int]],
    dest_dir: str,
    split: str = "test",
    percent: int = 100,
    shard_cnt: int = 4,
    withheld: Sequence[str] = (),
    views_per_scene: int = 24,
) -> str:
    """Write one split's shards (reference: data/dataset_prep.py:45-108).
    Returns the destination directory."""
    src_zip = zipfile.ZipFile(os.path.join(src_dir, "NMR_Dataset.zip"))
    metadata = yaml.safe_load(src_zip.read("NMR_Dataset/metadata.yaml"))
    suffix = "_".join((str(percent), str(shard_cnt)))
    name = "NMR_sharded_withheld" if withheld else "NMR_sharded"
    dest_dir = os.path.join(dest_dir, f"{name}_{suffix}")
    os.makedirs(dest_dir, exist_ok=True)

    split_dict = size_dict[split]
    limit = round(percent / 100 * sum(split_dict.values())) // shard_cnt

    shard_idx = 0
    sample_no = 0
    sink = TarShardWriter(
        os.path.join(dest_dir, f"NMR-{split}-{shard_idx:02d}.tar")
    )
    try:
        for key in metadata:
            if metadata[key]["name"] in withheld:
                continue
            for dir_name in _class_scene_list(src_zip, key, split):
                scene_key = (
                    f"{dir_name.split('/')[-2]}-{dir_name.split('/')[-1]}"
                )
                sample = {"__key__": scene_key}
                for i in range(views_per_scene):
                    fname = f"{i:04d}.png"
                    sample[fname] = src_zip.read(f"{dir_name}/image/{fname}")
                sample["cameras"] = src_zip.read(f"{dir_name}/cameras.npz")
                sink.write(sample)
                sample_no += 1
                if sample_no == limit:
                    sample_no = 0
                    shard_idx += 1
                    sink.close()
                    sink = TarShardWriter(
                        os.path.join(
                            dest_dir, f"NMR-{split}-{shard_idx:02d}.tar"
                        )
                    )
                    if shard_idx >= shard_cnt:
                        warnings.warn(
                            "Number of dataset samples not divisible by "
                            "shard count; overflowing into an extra uneven "
                            "shard."
                        )
    finally:
        sink.close()
    return dest_dir


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--src_dir", type=str, default="./data/nmr")
    parser.add_argument("-d", "--dest_dir", type=str, default="./data/nmr")
    parser.add_argument("-pc", "--percent", type=int, default=100)
    parser.add_argument("-sc", "--shard_count", type=int, default=4)
    parser.add_argument("--withhold", nargs="*", default=[])
    args = parser.parse_args(argv)
    size_dict = get_dataset_size(args.src_dir, args.withhold)
    for split in ("train", "val", "test"):
        shard_dataset(
            args.src_dir, size_dict, args.dest_dir, split,
            args.percent, args.shard_count, args.withhold,
        )


if __name__ == "__main__":
    main()
