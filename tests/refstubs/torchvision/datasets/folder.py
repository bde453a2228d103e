IMG_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp",
)


def find_classes(directory):
    import os

    classes = sorted(
        e.name for e in os.scandir(directory) if e.is_dir()
    )
    return classes, {c: i for i, c in enumerate(classes)}


def default_loader(path):
    from PIL import Image

    return Image.open(path).convert("RGB")
