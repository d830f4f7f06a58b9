from .clustering import connected_components, cluster_interfaces, DensityPeakClustering

__all__ = ["connected_components", "cluster_interfaces", "DensityPeakClustering"]
