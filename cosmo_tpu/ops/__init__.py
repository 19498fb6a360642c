from . import conedata, exp_pow, infeasibility, kkt, projections, residuals, scaling
