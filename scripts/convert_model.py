#!/usr/bin/env python
"""Convert legacy PyTorch PIFu/MonoPort checkpoints to orbax.

The reference downloads `net_G`/`net_C` with scripts/download_model.sh
(Google Drive); given those files, this converts them to this framework's
native checkpoint format. The RTL/infer apps can also load the .pth files
directly (monoport_tpu.convert.load_legacy_pifu).

Usage:
    python scripts/convert_model.py data/PIFu/net_G out/netG_orbax \
        --backbone PIFuHGFilters
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("src", help="PyTorch checkpoint path (.pth)")
    parser.add_argument("dst", help="output orbax directory")
    parser.add_argument("--backbone", default="PIFuHGFilters",
                        choices=["PIFuHGFilters", "PIFuResBlkFilters"])
    args = parser.parse_args()

    from monoport_tpu.convert import load_legacy_pifu
    import orbax.checkpoint as ocp

    variables = load_legacy_pifu(args.src, args.backbone)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(args.dst), variables, force=True)
    import jax
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"converted {n} weights -> {args.dst}")


if __name__ == "__main__":
    main()
