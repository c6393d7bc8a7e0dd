#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <cstdio>
int main() {
    cv::RNG rng(5);
    cv::Mat src(16, 32, CV_8UC3);
    rng.fill(src, cv::RNG::UNIFORM, 0, 256);
    cv::Mat g;
    cv::cvtColor(src, g, cv::COLOR_BGR2GRAY);
    FILE* f = fopen("gray_src.bin", "wb"); fwrite(src.data,1,src.total()*3,f); fclose(f);
    f = fopen("gray_dst.bin", "wb"); fwrite(g.data,1,g.total(),f); fclose(f);
    printf("ok\n");
    return 0;
}
