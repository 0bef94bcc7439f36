"""LANCIR pipeline driver (placeholder — implemented incrementally)."""


class LancIR:  # pragma: no cover - stub
    def __init__(self, *a, **k):
        raise NotImplementedError("LancIR lands with the plan layer")


def lancir_resize(*a, **k):  # pragma: no cover - stub
    raise NotImplementedError("lancir_resize lands with the plan layer")
