from .edge_gq import edge_gq_pallas, pack_table
