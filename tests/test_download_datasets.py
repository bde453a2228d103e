"""Hermetic tests of the classification dataset fetchers: tiny archives served
over file:// URLs exercise the full download+extract+organize logic (the
reference's download scripts, contrib/interactive_interp/classification/
download/*.py, are untestable without network)."""

import pathlib
import sys
import tarfile
import zipfile

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from contrib.interactive_interp.classification import download  # noqa: E402


def _jpg_bytes() -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), color=(200, 30, 30)).save(buf, format="JPEG")
    return buf.getvalue()


def _add_bytes(tar: tarfile.TarFile, name: str, data: bytes) -> None:
    import io

    info = tarfile.TarInfo(name)
    info.size = len(data)
    tar.addfile(info, io.BytesIO(data))


def test_flowers_organizes_splits(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")

    fixtures = tmp_path / "fix"
    fixtures.mkdir()
    n = 6
    # Labels 1/2 alternating; splits: train={1,2}, val={3,4}, test={5,6}.
    scipy_io.savemat(fixtures / "labels.mat", {"labels": np.array([[1, 2, 1, 2, 1, 2]])})
    scipy_io.savemat(
        fixtures / "setid.mat",
        {"trnid": np.array([[1, 2]]), "valid": np.array([[3, 4]]), "tstid": np.array([[5, 6]])},
    )
    jpg = _jpg_bytes()
    with tarfile.open(fixtures / "imgs.tgz", "w:gz") as tar:
        for i in range(1, n + 1):
            _add_bytes(tar, f"jpg/image_{i:05d}.jpg", jpg)

    out = tmp_path / "flowers"
    download.flowers(download.Flowers(
        dir=out,
        images_url=(fixtures / "imgs.tgz").as_uri(),
        labels_url=(fixtures / "labels.mat").as_uri(),
        splits_url=(fixtures / "setid.mat").as_uri(),
    ))
    assert (out / "train" / "1" / "image_00001.jpg").exists()
    assert (out / "train" / "2" / "image_00002.jpg").exists()
    assert (out / "val" / "1" / "image_00003.jpg").exists()
    assert (out / "test" / "2" / "image_00006.jpg").exists()
    assert not (out / "jpg").exists()


def test_cub_follows_official_split(tmp_path):
    fixtures = tmp_path / "fix"
    fixtures.mkdir()
    jpg = _jpg_bytes()
    with tarfile.open(fixtures / "cub.tgz", "w:gz") as tar:
        _add_bytes(tar, "CUB_200_2011/classes.txt", b"1 001.Sparrow\n2 002.Wren\n")
        _add_bytes(
            tar, "CUB_200_2011/images.txt",
            b"1 001.Sparrow/a.jpg\n2 001.Sparrow/b.jpg\n3 002.Wren/c.jpg\n",
        )
        _add_bytes(
            tar, "CUB_200_2011/image_class_labels.txt", b"1 1\n2 1\n3 2\n"
        )
        _add_bytes(tar, "CUB_200_2011/train_test_split.txt", b"1 1\n2 0\n3 1\n")
        for rel in ("001.Sparrow/a.jpg", "001.Sparrow/b.jpg", "002.Wren/c.jpg"):
            _add_bytes(tar, f"CUB_200_2011/images/{rel}", jpg)

    out = tmp_path / "cub"
    download.cub(download.Cub(dir=out, url=(fixtures / "cub.tgz").as_uri()))
    assert (out / "train" / "001.Sparrow" / "a.jpg").exists()
    assert (out / "test" / "001.Sparrow" / "b.jpg").exists()
    assert (out / "train" / "002.Wren" / "c.jpg").exists()
    assert not (out / "test" / "002.Wren" / "c.jpg").exists()


def test_caltech101_random_split_counts(tmp_path):
    fixtures = tmp_path / "fix"
    fixtures.mkdir()
    jpg = _jpg_bytes()
    inner = fixtures / "101_ObjectCategories.tar.gz"
    with tarfile.open(inner, "w:gz") as tar:
        for cls, count in (("accordion", 5), ("BACKGROUND_Google", 3)):
            for i in range(count):
                _add_bytes(tar, f"101_ObjectCategories/{cls}/img_{i:04d}.jpg", jpg)
    with zipfile.ZipFile(fixtures / "caltech-101.zip", "w") as zf:
        zf.write(inner, "caltech-101/101_ObjectCategories.tar.gz")

    out = tmp_path / "caltech"
    download.caltech101(download.Caltech101(
        dir=out, url=(fixtures / "caltech-101.zip").as_uri(), n_train=3, n_test=50
    ))
    train = list((out / "train" / "accordion").iterdir())
    test = list((out / "test" / "accordion").iterdir())
    assert len(train) == 3 and len(test) == 2
    assert not set(f.name for f in train) & set(f.name for f in test)
    # The background pseudo-class is dropped (reference download_caltech101.py:97-99).
    assert not (out / "train" / "BACKGROUND_Google").exists()
    assert not (out / "101_ObjectCategories").exists()
