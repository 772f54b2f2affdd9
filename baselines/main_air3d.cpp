// Baseline harness: UPSTREAM reference on the one-player reachability
// example (Dubins car, max-over-time signed-distance target, omega box
// constraints) — exec/air_3d_example flag defaults.
#include <ilqgames/examples/air_3d_example.h>
#include <ilqgames/solver/augmented_lagrangian_solver.h>
#include <ilqgames/solver/problem.h>
#include <ilqgames/solver/solver_params.h>
#include <ilqgames/utils/solver_log.h>
#include <ilqgames/utils/types.h>

#include <chrono>
#include <cstdio>
#include <fstream>
#include <memory>

int main(int argc, char** argv) {
  const char* out_path = argc > 1 ? argv[1] : nullptr;

  ilqgames::SolverParams params;
  params.max_backtracking_steps = 100;
  params.linesearch = true;
  params.expected_decrease_fraction = 0.1;
  params.initial_alpha_scaling = 0.75;
  params.convergence_tolerance = 0.01;

  auto problem =
      std::make_shared<ilqgames::Air3DExample>();
  problem->Initialize();
  ilqgames::AugmentedLagrangianSolver solver(problem, params);

  bool success = false;
  const auto start = std::chrono::high_resolution_clock::now();
  const auto log = solver.Solve(&success);
  const auto end = std::chrono::high_resolution_clock::now();

  const auto costs = log->TotalCosts();
  std::printf("success=%d iters=%zu solve_s=%.4f costs=", (int)success,
              log->NumIterates(),
              std::chrono::duration<double>(end - start).count());
  for (float c : costs) std::printf("%.4f ", c);
  std::printf("\n");
  if (out_path != nullptr) {
    std::ofstream out(out_path);
    const size_t last = log->NumIterates() - 1;
    for (size_t kk = 0; kk < ilqgames::time::kNumTimeSteps; ++kk) {
      const auto x = log->State(last, kk);
      for (int d = 0; d < x.size(); ++d)
        out << x(d) << (d + 1 < x.size() ? " " : "\n");
    }
  }
  return 0;
}
