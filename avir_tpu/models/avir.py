"""AVIR pipeline driver (placeholder — implemented incrementally)."""


class ImageResizer:  # pragma: no cover - stub
    def __init__(self, *a, **k):
        raise NotImplementedError("ImageResizer lands with the plan layer")


def resize(*a, **k):  # pragma: no cover - stub
    raise NotImplementedError("resize lands with the plan layer")
