"""Dataset factory (analog of `DataProviderFactory::Create`,
`dataprovider/DataProviderFactory.hpp:44`): loader selected by
`--data_provider_type`: KITTI=0, VIRTUAL_KITTI=1, CLUSTER=2, OMD=3, ARIA=4."""

from __future__ import annotations

from .base import DatasetProvider
from .kitti import KittiDataset
from .omd import OMDDataset
from .vkitti import VirtualKittiDataset


def create_dataset(
    provider_type: int,
    path: str,
    starting_frame: int = -1,
    ending_frame: int = -1,
    **kwargs,
) -> DatasetProvider:
    if provider_type == 0:
        return KittiDataset(path, starting_frame, ending_frame, **kwargs)
    if provider_type == 1:
        return VirtualKittiDataset(path, starting_frame, ending_frame, **kwargs)
    if provider_type == 2:
        from .cluster import ClusterSlamDataset

        return ClusterSlamDataset(path, starting_frame, ending_frame, **kwargs)
    if provider_type == 4:
        from .aria import ProjectAriaDataset

        return ProjectAriaDataset(path, starting_frame, ending_frame, **kwargs)
    if provider_type == 3:
        return OMDDataset(path, starting_frame, ending_frame, **kwargs)
    raise ValueError(f"unknown data_provider_type {provider_type}")
