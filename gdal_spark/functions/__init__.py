from gdal_spark.functions.st import register_st_functions

__all__ = ["register_st_functions"]
