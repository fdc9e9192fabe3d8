"""Driver-facing query modules. Importing a module registers its queries
(see hive_export_spark.registry)."""
