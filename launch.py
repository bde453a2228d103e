"""CLI for the saev_tpu framework (mirror of reference launch.py:11-16).

Usage:
    python launch.py shards    [data:fake-img ...] [--family clip --ckpt ... ]
    python launch.py train     [sae.activation:relu ...] [--lr 4e-4 --sweep sweep.py]
    python launch.py inference [--run runs/<id> --data.shards ...]
"""


def main():
    from saev_tpu.framework import inference, shards, train
    from saev_tpu.utils import cli

    cli.run({
        "shards": shards.cli,
        "train": train.main,
        "inference": inference.main,
    })


if __name__ == "__main__":
    main()
