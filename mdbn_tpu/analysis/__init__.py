from . import ais, survival
from .cluster import adjusted_rand_index, cluster_patients, extract_latent, kmeans_cluster
from .kmeans_jax import kmeans_cluster_jax
