from .dataset import NuScenesDataset, SyntheticNuScenesDataset, DataLoader, collate_fn  # noqa: F401
