"""IO: typed config system, dataset loaders, exporters, checkpointing."""
