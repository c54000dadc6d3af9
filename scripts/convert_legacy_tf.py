"""Convert a legacy TensorFlow StyleGAN2(-ADA) pickle to a native checkpoint.

TPU-native counterpart of the reference's `python legacy.py --source ...
--dest ...` tool (`legacy.py:296-321`): loads the (G, D, Gs) TF tuple with
a restricted unpickler, converts every network to our NHWC param pytrees,
and writes a msgpack checkpoint loadable by the apps/trainer.  Network
construction kwargs are stored alongside in a sidecar JSON.

Usage: python scripts/convert_legacy_tf.py --source old.pkl --dest new.ckpt
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True, help="legacy TF pickle")
    p.add_argument("--dest", required=True, help="output checkpoint path")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from pix2pix3d_tpu.utils.legacy_tf import load_legacy_tf_networks
    from pix2pix3d_tpu.train.checkpoint import save_checkpoint

    print(f'Loading "{args.source}"...')
    nets = load_legacy_tf_networks(args.source)
    params = {name: kp[1] for name, kp in nets.items()}
    kwargs = {name: kp[0] for name, kp in nets.items()}
    print(f'Saving "{args.dest}"...')
    save_checkpoint(args.dest, params, step=0)
    with open(args.dest + ".json", "w") as f:
        json.dump(kwargs, f, indent=2, default=str)
    print("Done.")


if __name__ == "__main__":
    main()
