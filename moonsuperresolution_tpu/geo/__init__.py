from moonsuperresolution_tpu.geo.tiff import GeoTiff, read_geotiff, write_geotiff

__all__ = ["GeoTiff", "read_geotiff", "write_geotiff"]
