from .logger import AverageMeter, ProgressMeter, CSVLogger
from .plotting import plot, plot_curves, plot_parameters, plot_inset, scatter_plot, rescale_img
from .mixins import TimeMixin, TiledMixin2d, tiled_apply
from .io import DownloadError, load_np, load_mat, load_tiff, load_url, load_example, get_cache_home, get_data_home
from .profiling import trace, compiled_cost, timeit
