from .binning import TriangleSetup, bin_triangles, triangle_setup  # noqa: F401
from .raster import RasterConfig, rasterize  # noqa: F401
