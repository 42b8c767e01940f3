"""Pipeline entry points mirroring the reference's two drivers."""

from gecko_spark.plans.pipeline import mutate_data_frame, to_data_frame

__all__ = ["mutate_data_frame", "to_data_frame"]
