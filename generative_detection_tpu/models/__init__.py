from .autoencoder import Autoencoder, PoseAutoencoder

__all__ = ["Autoencoder", "PoseAutoencoder"]
