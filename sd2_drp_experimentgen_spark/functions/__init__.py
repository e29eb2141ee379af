from .helpers import epoch_seconds, r4, r6, well_label  # noqa: F401
