from .hessian import HessianAccumulator, batch_outer, psum_hessian
from .gptq import GPTQResult, gptq_quantize, rtn_quantize, select_outliers
