class Suppress:
    """Annotation passthrough: tyro.conf.Suppress[T] -> T."""

    def __class_getitem__(cls, item):
        return item
