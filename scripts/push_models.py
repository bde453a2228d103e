"""Upload a trained SAE run to the HuggingFace Hub.

Capability mirror of reference scripts/push_models.py. Requires network egress
and `huggingface_hub` (neither available in the development image — the script
degrades with a clear message).

Usage:
    python scripts/push_models.py push --hf-token $TOKEN \\
        --folder runs/<id>/checkpoint --repo org/SAE_...
"""

import dataclasses
import logging
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

logger = logging.getLogger("push_models")

REPO_URL = "https://github.com/OSU-NLP-Group/saev"


@dataclasses.dataclass(frozen=True)
class Args:
    hf_token: str = ""
    folder: pathlib.Path = pathlib.Path("runs/abcdefg/checkpoint")
    repo: str = "osunlp/SAE_CLIP_24K_ViT-B-16_IN1K"
    modelcard: pathlib.Path | None = None
    """Optional markdown model card uploaded as README.md."""


def push(args: Args) -> None:
    logging.basicConfig(level=logging.INFO)
    assert args.hf_token, "--hf-token is required"
    assert (args.folder / "sae.pt").exists(), f"No sae.pt under {args.folder}"
    try:
        import huggingface_hub as hfhub
    except ImportError as err:
        raise RuntimeError(
            "huggingface_hub is not installed in this environment; run this "
            "script from a machine with network egress and `pip install "
            "huggingface_hub`."
        ) from err

    hfapi = hfhub.HfApi(token=args.hf_token)
    hfapi.upload_folder(
        folder_path=str(args.folder), repo_id=args.repo, repo_type="model"
    )
    if args.modelcard is not None:
        hfapi.upload_file(
            path_or_fileobj=str(args.modelcard),
            path_in_repo="README.md",
            repo_id=args.repo,
            repo_type="model",
        )
    logger.info("Uploaded %s to %s.", args.folder, args.repo)


if __name__ == "__main__":
    from saev_tpu.utils import cli as cli_mod

    cli_mod.run({"push": push})
