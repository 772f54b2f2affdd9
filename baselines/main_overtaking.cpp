// Baseline harness: UPSTREAM reference on ThreePlayerOvertakingExample,
// exec/three_player_overtaking/main.cpp flag defaults (linesearch on,
// alpha0 0.75, tol 0.01, frac 0.1).
#include <ilqgames/examples/three_player_overtaking_example.h>
#include <ilqgames/solver/augmented_lagrangian_solver.h>
#include <ilqgames/solver/problem.h>
#include <ilqgames/solver/solver_params.h>
#include <ilqgames/utils/solver_log.h>
#include <ilqgames/utils/types.h>

#include <cstdio>
#include <fstream>
#include <memory>

int main(int argc, char** argv) {
  ilqgames::SolverParams params;
  params.max_backtracking_steps = 100;
  params.linesearch = true;
  params.initial_alpha_scaling = 0.75;
  params.expected_decrease_fraction = 0.1;
  params.convergence_tolerance = 0.01;

  auto problem =
      std::make_shared<ilqgames::ThreePlayerOvertakingExample>();
  problem->Initialize();
  ilqgames::AugmentedLagrangianSolver solver(problem, params);
  bool success = false;
  const auto log = solver.Solve(&success);
  std::printf("success=%d iters=%zu costs=", (int)success,
              log->NumIterates());
  for (float c : log->TotalCosts()) std::printf("%.4f ", c);
  std::printf("\n");
  if (argc > 1) {
    std::ofstream out(argv[1]);
    const size_t last = log->NumIterates() - 1;
    for (size_t kk = 0; kk < ilqgames::time::kNumTimeSteps; ++kk) {
      const auto x = log->State(last, kk);
      for (int d = 0; d < x.size(); ++d)
        out << x(d) << (d + 1 < x.size() ? " " : "\n");
    }
  }
  return 0;
}
