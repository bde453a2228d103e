class Suppress:
    """Annotation passthrough: tyro.conf.Suppress[T] -> T."""

    def __class_getitem__(cls, item):
        return item


class EnumChoicesFromValues:
    """Annotation passthrough: tyro.conf.EnumChoicesFromValues[E] -> E
    (used by the reference's contrib classification configs)."""

    def __class_getitem__(cls, item):
        return item


def arg(**kwargs):
    """Annotation metadata passthrough: tyro.conf.arg(name="") is only read
    by the real tyro CLI parser, never at import/runtime in the tests."""
    return kwargs
