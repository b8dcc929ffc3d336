from . import boundary, minh, minh_device, minp, minp_device
