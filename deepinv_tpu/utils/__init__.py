from .logger import AverageMeter, ProgressMeter, CSVLogger
from .plotting import plot, plot_curves, plot_parameters, plot_inset, scatter_plot, rescale_img
from .mixins import TimeMixin, TiledMixin2d, tiled_apply
