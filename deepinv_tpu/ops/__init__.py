from .conv import (
    conv2d,
    conv_transpose2d,
    conv2d_fft,
    conv_transpose2d_fft,
    conv3d,
    conv_transpose3d,
    conv3d_fft,
    conv_transpose3d_fft,
    filter_fft_2d,
    gaussian_blur,
    bilinear_filter,
    bicubic_filter,
    sinc_filter,
    kaiser_window,
)
from .fourier import dct2, idct2, dct1d, idct1d, dst1, fftc, ifftc
from .product_convolution import product_convolution2d, product_convolution2d_adjoint, multiplier
from .radon import radon, iradon, ramp_filter
from .radon_fourier import radon_fourier, iradon_fourier
from .wavelets import WaveletTransform
from .nufft import nufft2, nufft2_adjoint
from .imresize import imresize_matlab
from .misc import histogram, histogramdd, ThinPlateSpline, random_choice
