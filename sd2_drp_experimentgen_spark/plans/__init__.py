from .registry import QuerySpec, all_specs, get_spec, register  # noqa: F401
