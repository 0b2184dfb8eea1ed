from .stft import STFT, hann_window, istft, stft

__all__ = ["STFT", "stft", "istft", "hann_window"]
