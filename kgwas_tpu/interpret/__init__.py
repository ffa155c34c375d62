from .attention import get_network_weight, attention_tables
from .network import generate_viz, get_local_interpretation
