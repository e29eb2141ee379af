# Operator modules register queries into plans.registry on import;
# plans.registry.all_specs() imports them lazily.
