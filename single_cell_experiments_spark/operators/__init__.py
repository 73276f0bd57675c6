"""Operator modules.  Importing a module registers its queries (see
``registry.query``).  ``registry._load_all_operator_modules`` imports all."""
