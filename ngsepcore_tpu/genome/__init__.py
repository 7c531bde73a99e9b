from .builders import build_individual_genome, mask_genome_regions
