// Baseline harness: UPSTREAM reference on DubinsOriginExample — solves the
// same problem under BOTH information patterns (open-loop then feedback),
// exec/dubins_origin_example/main.cpp flag defaults (linesearch OFF,
// alpha0 0.1, tol 0.1, frac 0.1).
#include <ilqgames/examples/dubins_origin_example.h>
#include <ilqgames/solver/augmented_lagrangian_solver.h>
#include <ilqgames/solver/problem.h>
#include <ilqgames/solver/solver_params.h>
#include <ilqgames/utils/solver_log.h>
#include <ilqgames/utils/types.h>

#include <cstdio>
#include <fstream>
#include <memory>

static void dump(const std::shared_ptr<const ilqgames::SolverLog>& log,
                 const char* path) {
  std::ofstream out(path);
  const size_t last = log->NumIterates() - 1;
  for (size_t kk = 0; kk < ilqgames::time::kNumTimeSteps; ++kk) {
    const auto x = log->State(last, kk);
    for (int d = 0; d < x.size(); ++d)
      out << x(d) << (d + 1 < x.size() ? " " : "\n");
  }
}

int main(int argc, char** argv) {
  ilqgames::SolverParams params;
  params.max_backtracking_steps = 100;
  params.linesearch = false;
  params.initial_alpha_scaling = 0.1;
  params.expected_decrease_fraction = 0.1;
  params.convergence_tolerance = 0.1;

  for (int open_loop = 1; open_loop >= 0; --open_loop) {
    params.open_loop = open_loop != 0;
    auto problem = std::make_shared<ilqgames::DubinsOriginExample>();
    problem->Initialize();
    ilqgames::AugmentedLagrangianSolver solver(problem, params);
    bool success = false;
    const auto log = solver.Solve(&success);
    std::printf("open_loop=%d success=%d iters=%zu costs=", open_loop,
                (int)success, log->NumIterates());
    for (float c : log->TotalCosts()) std::printf("%.4f ", c);
    std::printf("\n");
    if (argc > 1 + (1 - open_loop)) dump(log, argv[1 + (1 - open_loop)]);
  }
  return 0;
}
