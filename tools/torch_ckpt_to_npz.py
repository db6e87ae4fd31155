"""Convert a reference PyTorch checkpoint (.pth.tar / Lightning .ckpt) into
a flat npz of numpy arrays.

Run this in a SEPARATE process from any JAX program: importing torch into a
JAX process deadlocks the XLA compile thread in this environment.

Usage:
    python tools/torch_ckpt_to_npz.py <ckpt.pth.tar> <out.npz>
        [--state_key model_state] [--strip_prefix 6]

The reference stores segnet weights as {'model_state': state_dict}
(utils/pytorch_util.py:84-89) and FlowStep3D Lightning checkpoints as
{'state_dict': {'model.<k>': v}} requiring a 6-char prefix strip
(test_flow_kittisf.py:42-44).
"""

import argparse

import numpy as np


def main():
    import torch

    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt", type=str)
    parser.add_argument("out", type=str)
    parser.add_argument("--state_key", type=str, default=None,
                        help="Top-level dict key (model_state / state_dict); "
                             "auto-detected if omitted")
    parser.add_argument("--strip_prefix", type=int, default=0,
                        help="Characters to strip from every key "
                             "(6 for Lightning 'model.' prefixes)")
    args = parser.parse_args()

    blob = torch.load(args.ckpt, map_location="cpu")
    if args.state_key is not None:
        state = blob[args.state_key]
    elif isinstance(blob, dict) and "model_state" in blob:
        state = blob["model_state"]
    elif isinstance(blob, dict) and "state_dict" in blob:
        state = blob["state_dict"]
    else:
        state = blob

    arrays = {}
    for k, v in state.items():
        key = k[args.strip_prefix:] if args.strip_prefix else k
        arrays[key] = v.detach().cpu().numpy()
    np.savez(args.out, **arrays)
    print(f"wrote {len(arrays)} arrays to {args.out}")


if __name__ == "__main__":
    main()
