from .flow_viz import flow_to_image
