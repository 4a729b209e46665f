"""Operator modules. Each module registers its queries via
``grader_etl_spark.registry.query`` at import time;
``registry.load_all_operators()`` imports them all."""
