"""Materialize a synthetic dataset as reference-schema pickle files.

Writes the exact five-file layout the real pipelines read
(reference: DiffuseSG/utils/dataloader.py:55-61 paths; our reader:
data/dataset.py:_DATASET_PATHS) so that (a) users without the original
Visual Genome / COCO-Stuff archives can exercise the full REAL loading
path end to end, and (b) the pickle schema compatibility is provable by
round-trip (tests/test_data.py::test_pickle_roundtrip_real_loader_path).

    python scripts/make_dataset_pickles.py --out /data --dataset visual_genome \
        --num_train 256 --num_test 128 [--max_node_num 64] [--seed 0]

Afterwards:  python -m diffusesg_tpu.cli.train -c <cfg> --data_root /data
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_pickles(out_root: str, dataset: str, max_node_num: int = 64,
                  num_train: int = 256, num_test: int = 128, seed: int = 0):
    from diffusesg_tpu.data.dataset import _DATASET_PATHS
    from diffusesg_tpu.data.synthetic import synthetic_bundle_dicts

    key = "visual_genome" if "visual_genome" in dataset else "coco_stuff"
    train, test, train_stats, test_stats, idx_to_word = synthetic_bundle_dicts(
        dataset, max_node_num, seed=seed, num_train=num_train, num_test=num_test)
    payloads = {"train_pkl": train, "test_pkl": test,
                "train_stats": train_stats, "test_stats": test_stats,
                "idx_to_word": idx_to_word}
    written = []
    for name, payload in payloads.items():
        path = os.path.join(out_root, _DATASET_PATHS[key][name])
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        written.append(path)
    return written


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--dataset", default="visual_genome",
                    choices=["visual_genome", "coco_stuff"])
    ap.add_argument("--max_node_num", type=int, default=64)
    ap.add_argument("--num_train", type=int, default=256)
    ap.add_argument("--num_test", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    for p in write_pickles(args.out, args.dataset, args.max_node_num,
                           args.num_train, args.num_test, args.seed):
        print("wrote", p)


if __name__ == "__main__":
    main()
