from data_pipelines_spark.pipelines.assets import Asset, AssetGraph

__all__ = ["Asset", "AssetGraph"]
